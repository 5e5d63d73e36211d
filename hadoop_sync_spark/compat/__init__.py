"""Environment-compat seams: optional-dependency shims that make a
capability runnable in containers that lack the canonical wheel, without
changing behavior where the real dependency exists."""
