"""Auxiliary subsystems: config, frame stats, logging, checkpointing."""
