"""Raw-format sources that feed the engine's table contracts (SURVEY §2.1)."""
