"""Build hooks for the native sparsekit data loader.

The reference's build compiles four Cython extensions (reference:
setup.py:24-47); here the only native component is the optional OpenMP
CSR->ELL converter, compiled with plain g++ (ctypes binding, no
Python C API). The package works without it via NumPy fallbacks, so the
build is best-effort.
"""

import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        native_dir = Path(__file__).parent / "bayesbridge_tpu" / "native"
        try:
            subprocess.run(["make", "-s", "-C", str(native_dir)],
                           check=True, timeout=300)
        except Exception as exc:  # noqa: BLE001
            print(f"sparsekit native build skipped: {exc}")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
