from .apla_proj import apla_proj
from .attention import multi_head_attention, apla_attention
