"""Build the optional C scalar tier: python setup.py build_ext --inplace."""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "simdutf_tpu._cnative",
            sources=["simdutf_tpu/_native/cnative.c"],
            extra_compile_args=["-O3"],
        )
    ]
)
