"""``python -m gpusolve_tpu <config>`` — CLI entry (see gpusolve_tpu.cli)."""

import sys

from gpusolve_tpu.cli import main

sys.exit(main())
