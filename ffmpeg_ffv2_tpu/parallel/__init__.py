from .slices import (uniform_slice_stack, phase_a_sharded, make_mesh,
                     unstack_slices)
