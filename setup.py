"""Package + native-extension build.

The C++ pieces are plain shared libraries consumed via ctypes (no pybind11
in the image), built either by `make -C native` (done lazily at import) or
by this setup script."""
import subprocess
import os

from setuptools import Command, find_packages, setup


class BuildNative(Command):
    description = "build the native C++ components (libfastdicom.so)"
    user_options = []

    def initialize_options(self):
        pass

    def finalize_options(self):
        pass

    def run(self):
        here = os.path.dirname(os.path.abspath(__file__))
        subprocess.run(["make", "-C", os.path.join(here, "native")], check=True)


setup(
    name="raytracedicom-tpu",
    version="0.1.0",
    description=("TPU-native differentiable proton pencil-beam dose engine "
                 "(RayTraceDicom capability surface, JAX/Pallas)"),
    packages=find_packages(include=["raytracedicom_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "orbax-checkpoint"],
    cmdclass={"build_native": BuildNative},
    entry_points={
        "console_scripts": [
            "raytracedicom-tpu = raytracedicom_tpu.cli:main",
        ],
    },
)
