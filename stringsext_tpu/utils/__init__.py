"""Auxiliary subsystems: checkpoint/resume, profiling."""
