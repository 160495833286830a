"""Engine operators beyond plain relational plans: text analysis,
deduplication, similarity search, the streaming-executable (pipe) contract,
and multimodal column plumbing."""
