"""Compute ops: collision grid, forces, integrators, worldlines, rendering."""
