"""Structured Streaming tier: readStream jobs twinned with the declared
batch queries (SURVEY §2.11), a file-replay source for deterministic tests,
and the watermark/dedup/stateful smoke surface (ST4-ST6)."""
