from herald_tpu.sched.pysched import PyLruSim, PyScheduler
from herald_tpu.sched.scheduler import LookaheadScheduler, NativeScheduler
