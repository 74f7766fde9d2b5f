"""Scan engine: decode-event generation + exact emission automaton."""
