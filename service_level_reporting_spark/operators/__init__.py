"""Operator modules; importing each registers its queries in the registry."""
