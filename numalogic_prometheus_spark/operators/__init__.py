"""Composable DataFrame transforms — the engine's operator library."""
