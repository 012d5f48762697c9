"""CameraBench two-stage evaluation harness (reference camerabench/*).

Stage 1 (method-specific) generates standardized JSON score files; Stage 2
(method-agnostic) evaluates any score file matching the contracts — so
Stage 2 doubles as an offline test surface (reference camerabench/README.md).
"""
