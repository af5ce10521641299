"""Batch sources: encoding-fallback CSV, PSV, versioned record scan,
sharded pagination planning, snapshot-selection policies."""
