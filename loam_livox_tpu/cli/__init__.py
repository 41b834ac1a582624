"""Command-line entry points — the L5 launch layer (reference:
``launch/*.launch`` + YAML profiles)."""
