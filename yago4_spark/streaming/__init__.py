"""Structured Streaming surface (SURVEY §2.10: the reference is strictly
batch — this module adds the streaming capabilities a continuous document
feed needs, sharing the batch operators' logic)."""
