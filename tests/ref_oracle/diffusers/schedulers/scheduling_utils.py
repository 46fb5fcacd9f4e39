import enum


class KarrasDiffusionSchedulers(enum.Enum):
    EulerDiscreteScheduler = 1


class SchedulerMixin:
    pass
