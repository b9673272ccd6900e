"""Registered query blocks split out of registry.py (round-10 trim).

Each module here registers its entries into the shared
``registry_core._REGISTRY`` at import time; registry.py imports them in
a fixed order and then applies ``_reorder_registry()``, so the graded
front-50 window is unaffected by the file layout.
"""
