"""Offline rendering modes, metric harness, trajectory export."""
