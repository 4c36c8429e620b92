"""Sources/sinks: testdata catalog, interleaved-corpus adapters,
checkpointed parquet writer."""
