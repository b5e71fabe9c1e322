"""Native (C) components with pure-Python fallbacks.

The reference has no native layer (its device code is WGSL; SURVEY.md §2);
here the host-side hot paths — frame encoding and checkpoint bit codecs —
are a C extension (native/framesink.c), built by ``pip install .``.
``HAVE_NATIVE`` reports whether the compiled extension loaded.
"""

try:
    from . import framesink  # type: ignore[attr-defined]

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - build-environment dependent
    framesink = None
    HAVE_NATIVE = False

__all__ = ["framesink", "HAVE_NATIVE"]
