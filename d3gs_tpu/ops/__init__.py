"""Compute ops: math kernels, projection, binning, blending, losses."""
