import logging as _logging
from collections import OrderedDict


class BaseOutput(OrderedDict):
    """Attribute + index access output container (dataclass subclasses set
    fields normally; the scheduler only reads ``.prev_sample`` etc.)."""

    def __post_init__(self):
        for field_name, value in self.__dict__.items():
            if not field_name.startswith("_"):
                self[field_name] = value

    def __setattr__(self, name, value):
        super().__setattr__(name, value)
        if not name.startswith("_"):
            self[name] = value


class logging:  # namespace mimic: diffusers.utils.logging.get_logger
    @staticmethod
    def get_logger(name=None):
        return _logging.getLogger(name)
