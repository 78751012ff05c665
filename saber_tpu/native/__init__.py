"""Native (C++) runtime components, bound via ctypes.

``cc``: union-find connected components (cc.cpp). The library builds on
first import if g++ is available; consumers (saber_tpu/ops/connected.py)
fall back to scipy when the build is impossible.
"""
