"""Driver-side plans: the crawl frontier epoch loop (checkpointed)."""
