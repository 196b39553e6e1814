"""Light sources and next-event estimation support (reference L4)."""
