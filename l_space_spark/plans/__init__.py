from .superstep import SuperstepRunner, SuperstepResult  # noqa: F401
