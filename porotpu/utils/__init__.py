from .printing import parprint
from .timers import Timers
