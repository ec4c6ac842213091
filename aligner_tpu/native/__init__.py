"""Native (C++) components: build-on-demand via g++ + ctypes.

The reference ships a Cython kernel plus a 30k-line generated core.c and
prebuilt .so binaries pinned to specific Python versions (SURVEY.md §0);
this framework instead keeps one small C++ source compiled lazily into a
cache directory, loaded through ctypes — no codegen artifacts in-tree, no
interpreter-version coupling.
"""
from .build import load_mas_cpu, maximum_path_cpp

__all__ = ["load_mas_cpu", "maximum_path_cpp"]
