"""Config, CLI, JSON export, circom main-component writer, metrics (L6)."""
