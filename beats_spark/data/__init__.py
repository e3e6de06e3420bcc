"""Deterministic synthetic data derivations for tests/bench/oracle parity."""
