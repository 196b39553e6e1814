"""Command-line entry points (reference L8, src/bin/)."""
