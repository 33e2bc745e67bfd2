import sys

from gnina_tpu.cli import main

sys.exit(main())
