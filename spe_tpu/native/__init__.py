"""Native (C++) runtime components, loaded via ctypes.

Build lazily on first use: `python -m spe_tpu.native.build`.
"""
