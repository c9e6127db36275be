"""Build dist/pysparkdedup.zip for spark-submit --py-files.

The zip's root contains the ``pysparkdedup/`` package so executors can
import it after Spark prepends the archive to sys.path.
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "pysparkdedup.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "pysparkdedup")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in sorted(os.listdir(pkg)):
            if name.endswith(".py"):
                zf.write(os.path.join(pkg, name),
                         arcname=f"pysparkdedup/{name}")
    return out_path


if __name__ == "__main__":
    print(build())
