"""Exporters (mesh-exporter, gaussian-mesh-exporter). Modules register lazily."""
