"""Structured-Streaming surface: graph-event deltas and stream metrics."""
