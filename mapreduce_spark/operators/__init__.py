"""Operator modules: each registers its queries on import (registry.ALL_MODULES)."""
