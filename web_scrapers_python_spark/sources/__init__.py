"""Sources & sinks: seed readers, the snapshot catalog (Iceberg-semantics
state store), and the deterministic synthetic Common-Crawl-style page
generator used for tests and benchmarks."""
