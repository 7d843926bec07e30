"""Sources/sinks: testdata readers, CSV alias-map import, JSONL export."""
