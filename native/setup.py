"""Build the native IO extension:

    python native/setup.py build_ext --inplace

places `_native_io.*.so` next to this file; `loam_livox_tpu.io.native`
also searches here."""
import numpy as np
from setuptools import Extension, setup

setup(
    name="loam-livox-tpu-native",
    ext_modules=[
        Extension(
            "_native_io",
            sources=["native_io.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
        )
    ],
    script_args=["build_ext", "--inplace"],
)
