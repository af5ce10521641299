"""Relational + training-data operator library."""
