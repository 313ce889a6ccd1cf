#!/usr/bin/env python3
"""Build the native components (C++ shared libraries, ctypes ABI).

Usage: python native/build.py
Outputs: native/lib/libgpmf.so
"""

import subprocess
import sys
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parent
LIB_DIR = NATIVE_DIR / "lib"

TARGETS = [
    ("gpmf.cpp", "libgpmf.so", []),
    # audio decode links the system ffmpeg libs (same decoder stack cv2 uses)
    ("audio.cpp", "librfaudio.so", ["-lavformat", "-lavcodec", "-lavutil"]),
]


def build() -> int:
    LIB_DIR.mkdir(exist_ok=True)
    for src, out, extra in TARGETS:
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            str(NATIVE_DIR / src), "-o", str(LIB_DIR / out), *extra,
        ]
        print(" ".join(cmd))
        result = subprocess.run(cmd)
        if result.returncode != 0:
            return result.returncode
    print(f"built {len(TARGETS)} native libraries into {LIB_DIR}")
    return 0


if __name__ == "__main__":
    sys.exit(build())
