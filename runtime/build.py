#!/usr/bin/env python
"""Build the native WAV codec extension in-place (cc direct, no setuptools
machinery needed). Produces runtime/_wavcodec.<abi>.so; io/wav.py picks it
up when importable and falls back to the numpy path otherwise."""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path


def build() -> Path:
    here = Path(__file__).parent
    src = here / "wavcodec.c"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = here / f"_wavcodec{suffix}"
    include = sysconfig.get_paths()["include"]
    cmd = [
        "cc", "-shared", "-fPIC", "-O3", "-Wall",
        f"-I{include}", str(src), "-o", str(out),
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    print(build())
