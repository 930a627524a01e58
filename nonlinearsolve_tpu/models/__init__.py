from . import bratu, brusselator, problems23, reaction_diffusion
