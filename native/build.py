"""Build the native host-kernel extension in place.

Usage: python native/build.py
Produces _ethproof_native.*.so inside ethproof_tpu/, which
ethproof_tpu.hash.keccak picks up automatically (numpy fallback without).
"""

import os
import shutil
import subprocess
import sys
import sysconfig
import tempfile


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    src = os.path.join(here, "ethproof_native.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(repo, "ethproof_tpu", f"_ethproof_native{suffix}")
    include = sysconfig.get_paths()["include"]
    with tempfile.TemporaryDirectory() as td:
        obj = os.path.join(td, "ethproof_native.o")
        so = os.path.join(td, "out.so")
        cc = os.environ.get("CC", "gcc")
        subprocess.check_call(
            [cc, "-O3", "-fPIC", "-Wall", f"-I{include}", "-c", src, "-o", obj]
        )
        subprocess.check_call([cc, "-shared", obj, "-o", so])
        shutil.copy2(so, out)
    print(f"built {out}")


if __name__ == "__main__":
    main()
