"""Structured Streaming surface (SURVEY.md §2.2 B31-B35).

The reference has no streaming at all; this package gives the engine the
streaming faces of its batch operators. Design rule: every streaming
transformation is a shared builder (streaming/windows.py) that also runs
on a batch DataFrame — so correctness is oracle-checked in batch and the
streaming-specific machinery (watermarks, triggers, state) is tested with
the rate/memory harness in tests/test_streaming.py.
"""
