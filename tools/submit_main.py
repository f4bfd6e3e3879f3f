"""spark-submit entry point (BASELINE.json:6 "ships via spark-submit
--py-files").

Usage:
    python tools/make_zip.py                      # -> dist/irkit_spark.zip
    spark-submit --master local[8] \
        --py-files dist/irkit_spark.zip \
        tools/submit_main.py build --pages ... --out ...

The engine package arrives on every executor's PYTHONPATH via
--py-files; this file itself carries no logic.
"""

import sys

from irkit_spark.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
