"""Shared deterministic kernels (text normalization, hashing, signatures).

Everything in this subpackage is importable both on the driver (pure-Python
oracle used by pytest goldens) and inside executor Arrow UDFs — ONE
implementation, so the byte-identical-extraction and identical-signature
invariants hold by construction (BASELINE.json input_hint).
"""
