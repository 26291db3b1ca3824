from .residual_unit import fused_dilated_unit
