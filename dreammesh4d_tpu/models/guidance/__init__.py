"""Diffusion guidance (Zero123 SDS). Modules register lazily."""
