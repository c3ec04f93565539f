"""Core algorithms: registration (ICP), point-cloud maintenance, mapping."""
