from .log import get_logger, xinfo, xwarn
from .timers import SimpleTimer, PhaseTimer
