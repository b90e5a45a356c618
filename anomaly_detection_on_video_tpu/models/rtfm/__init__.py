"""RTFM model package placeholder.

The reference reserves this slot for an RTFM implementation that was never
written (reference: src/models/rtfm/__init__.py is empty). Kept to mirror
the model-registry layout; see models/__init__.py.
"""
