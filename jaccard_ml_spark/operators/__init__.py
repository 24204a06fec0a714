"""DataFrame-level operators: the pipeline stages of the engine."""
