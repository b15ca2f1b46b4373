"""Native (C++) runtime components, loaded via ctypes.

- ``objio_native``: fast OBJ point-cloud IO (objio.cpp), auto-built with g++
  on first use; data/objio.py falls back to pure Python when unavailable.

The TPU *compute* path needs no C++ — it is XLA + Pallas kernels
(SURVEY.md §2.6: the reference itself has zero first-party native code; its
native deps are third-party wheels like libigl, which this layer replaces).
"""
