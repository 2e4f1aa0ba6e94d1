"""Utility layer (L0): logging, PRNG seeding, YAML config loading, mesh/device resolution."""
