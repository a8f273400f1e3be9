import os
import sys

from .cli import main

try:
    rc = main()
    # flush explicitly so a closed-downstream (e.g. `| head`) pipe error
    # is raised HERE, where it can map to the conventional quiet exit,
    # not from the interpreter's exit-time flush
    sys.stdout.flush()
except BrokenPipeError:
    # downstream consumer (head, less q) closed the pipe: the Unix
    # convention is a silent death, not a traceback.  Point stdout at
    # devnull so the interpreter's exit-time flush can't raise again.
    os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
    rc = 0
sys.exit(rc)
