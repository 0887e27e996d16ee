from .timing import StageTimer, TimerDatabase

__all__ = ["StageTimer", "TimerDatabase"]
