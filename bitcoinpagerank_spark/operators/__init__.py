"""Graph / pipeline operators (the engine's product surface)."""
