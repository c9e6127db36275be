"""spark-submit entry script: the cluster deployment path the CLI documents.

Usage (the package travels as a --py-files zip, built by package_pyfiles):

    python tools/package_pyfiles.py                      # -> dist/pysparkdedup.zip
    spark-submit --master <cluster> --py-files dist/pysparkdedup.zip \
        tools/submit_entry.py --input /data/pages --strategy select-newest ...

spark-submit runs a script (not a module), so this thin shim forwards to
pysparkdedup.cli.main — all flags are the CLI's.
"""

import sys

from pysparkdedup.cli import main

if __name__ == "__main__":
    sys.exit(main())
