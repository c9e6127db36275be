"""Custom PySpark worker daemon: preload heavy libraries before forking.

Python workers are forked from the daemon per task (reuse is best-effort;
early-terminated Arrow streams and stage turnover churn workers). Every fresh
worker that has to import numpy + pandas + this package pays ~1s of CPU and a
storm of page faults — at thousands of tasks that becomes the dominant kernel
time. Preloading in the daemon makes each fork inherit the imports as
copy-on-write pages.

Enable with: spark.python.daemon.module=pysparkdedup.worker_daemon
(session.py sets this automatically).
"""

import numpy  # noqa: F401
import pandas  # noqa: F401

try:  # our own kernels (pulls in hashlib/difflib etc.)
    import pysparkdedup.minhash  # noqa: F401
    import pysparkdedup.simhash  # noqa: F401
    import pysparkdedup.tokenhash  # noqa: F401
    import pysparkdedup.guards  # noqa: F401
except Exception:  # pragma: no cover - package not shipped to this worker
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
