"""Sources & sinks: JSONL (raw-line passthrough), WARC, synthetic pages, media."""
