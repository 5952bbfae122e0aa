"""Pure-Python transcription of the reference's row-level semantics.

These functions are the byte-parity golden for the Spark engine's
column expressions and pandas UDFs. Each carries a provenance comment
citing the reference file:line it transcribes. They are dependency-free
(stdlib only) so they run in tests and inside Arrow-batched UDFs.
"""
