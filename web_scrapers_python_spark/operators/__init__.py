"""Engine operators: parsing UDFs, dedup (exact + bloom), politeness,
link expansion, sequencing, text-corpus ops (near-dup, quality, langid),
and similarity search."""
