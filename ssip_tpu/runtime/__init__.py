"""Runtime core: logging, PRNG discipline, artifact registry, device bootstrap."""
