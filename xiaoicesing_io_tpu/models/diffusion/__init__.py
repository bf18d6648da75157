from .schedule import DiffusionSchedule, beta_schedule
from .core import GaussianDiffusion, RectifiedFlow, SpecNormalizer
