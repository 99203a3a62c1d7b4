"""Build the native decode extension:

    cd combo_avs_tpu/native && python setup.py build_ext --inplace

Links against the system libpng/libjpeg/zlib (present in this image; no
network needed). The Python loader falls back to cv2 when the extension is
not built, so this is an optional performance component — the native
equivalent of the reference's torch-DataLoader worker hot path.
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="combo_io",
    ext_modules=[
        Extension(
            "_combo_io",
            sources=["combo_io.cpp"],
            include_dirs=[np.get_include()],
            libraries=["png", "jpeg", "z"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
        )
    ],
)
