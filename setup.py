"""Build config: the native frame-sink extension (optional — the package
falls back to pure-Python codecs when the extension is absent)."""

from setuptools import setup, Extension

setup(
    ext_modules=[
        Extension(
            "cellularautomatons3d_tpu.native.framesink",
            sources=["native/framesink.c"],
            libraries=["z"],
            optional=True,
        )
    ],
)
