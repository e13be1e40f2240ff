from .psnr import tiny_psnr_line, psnr_u8
