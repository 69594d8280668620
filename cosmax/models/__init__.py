from cosmax.models.background import MODELS, de_density, e2_of_z, hubble
from cosmax.models import distances, recombination, growth

__all__ = ["MODELS", "de_density", "e2_of_z", "hubble", "distances", "recombination", "growth"]
