"""Runtime: block scheduling, carry-state streaming, session
orchestration, checkpoint/resume, and metrics."""
