"""End-to-end pipelines (kiln preprocessing, serving views) — built in M4/M5."""
