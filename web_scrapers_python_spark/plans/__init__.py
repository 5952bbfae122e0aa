"""Plan construction: the per-round DataFrame job and the driver crawl
loop with snapshot checkpoints (SURVEY §3 lifecycle, §2.10 E3/E5)."""
