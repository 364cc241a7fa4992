import numpy
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "light_loam_tpu._native",
            sources=["native/loam_native.c"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-Wall"],
        )
    ]
)
