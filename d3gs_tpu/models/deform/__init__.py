"""Deformation fields: time-conditioned MLPs, 6DoF variant, neural-ODE."""
from .networks import (DeformMLP, DeformNetworkODE, DeformNetworkSimple,
                       DeformNetworkSimpleStart, positional_encoding)  # noqa: F401
from .fields import (DeformState, create_deform_field, DeformFieldSpec)  # noqa: F401
