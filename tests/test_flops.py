"""Pin the analytic FLOP formulas against independent hand arithmetic.

The bench's MFU derives from phoonnx_tpu.flops (XLA cost_analysis
attributes ~zero FLOPs to Pallas custom-calls and overcounts
input-dilated transposed convs, VERDICT r2); these literals were
computed by hand from the reference module shapes so a formula
regression cannot silently skew the published numbers.
"""

from phoonnx_tpu import flops
from phoonnx_tpu.models.vits.model import VitsHParams


def test_decoder_flops_medium_hand_count():
    hp = VitsHParams.preset("medium")
    # medium, 512 frames, rates (8,8,4), ch 256->128->64->32,
    # resblock "2" kernels (3,5,7) x 2 dilations = sum k*n_convs = 30:
    #   conv_pre : 2*512*256*192*7        = 352_321_536
    #   up1      : 2*512*128*256*16       = 536_870_912
    #   res1     : 2*4096*128*128*30      = 4_026_531_840
    #   up2      : 2*4096*64*128*16       = 1_073_741_824
    #   res2     : 2*32768*64*64*30       = 8_053_063_680
    #   up3      : 2*32768*32*64*8        = 1_073_741_824
    #   res3     : 2*131072*32*32*30      = 8_053_063_680
    #   conv_post: 2*131072*1*32*7        = 58_720_256
    expected = (352_321_536 + 536_870_912 + 4_026_531_840
                + 1_073_741_824 + 8_053_063_680 + 1_073_741_824
                + 8_053_063_680 + 58_720_256)
    assert flops.decoder_flops(hp, 512) == expected


def test_flow_flops_hand_count():
    hp = VitsHParams.preset("medium")
    # 4 couplings; WN k=5 x 4 layers at h=192, half=96, Y=512:
    #   per WN layer: 2*512*384*192*5 + 2*512*384*192 = 452_984_832
    #   per coupling: 2*512*192*96 + 4*452_984_832 + 2*512*96*192
    per_coupling = 18_874_368 + 4 * 452_984_832 + 18_874_368
    assert flops.flow_flops(hp, 512) == 4 * per_coupling


def test_encoder_flops_hand_count():
    hp = VitsHParams.preset("medium")
    # 6 layers at T=128, h=192, f=768, k=3, rel window 4:
    #   qkvo: 4*2*128*192*192 = 37_748_736
    #   attn: 2*2*128*128*192 = 12_582_912
    #   rel : 2*2*128*9*192   =    884_736
    #   ffn : 2*2*128*768*576 = 226_492_416
    per_layer = 37_748_736 + 12_582_912 + 884_736 + 226_492_416
    proj = 2 * 128 * 384 * 192
    assert flops.text_encoder_flops(hp, 128) == 6 * per_layer + proj


def test_total_magnitude_medium():
    """The r2 bench published 0.301 "gflop per utterance" from XLA
    cost_analysis; the real model FLOPs at (128 text, 512 frames) are
    ~32.5 GFLOP — two orders of magnitude more. Pin the magnitude so
    the bench can never regress to the custom-call-blind count."""
    hp = VitsHParams.preset("medium")
    g = flops.infer_gflops(hp, 128, 512)
    assert 30.0 < g < 35.0


def test_high_preset_larger_than_medium():
    hp_m = VitsHParams.preset("medium")
    hp_h = VitsHParams.preset("high")
    assert (flops.decoder_flops(hp_h, 512)
            > 3 * flops.decoder_flops(hp_m, 512))


def test_istft_decoder_cheaper_than_hifigan():
    hp_m = VitsHParams.preset("medium")
    hp_i = VitsHParams.preset("medium-istft")
    # medium-istft drops the final x4 upsample stage (~38% of decoder
    # FLOPs) in exchange for the spectral heads + iSTFT
    assert (flops.decoder_flops(hp_i, 512)
            < 0.7 * flops.decoder_flops(hp_m, 512))


def test_posterior_flops_hand_count():
    hp = VitsHParams.preset("medium")
    # pre 2*512*192*513 + 16 WN layers (2*512*384*192*5 + 2*512*384*192)
    # + proj 2*512*384*192 = 7_424_114_688
    assert flops.posterior_flops(hp, 512) == 7_424_114_688


def test_disc_p_flops_hand_count():
    # period 2 over 8192 samples, channels 1->32->128->512->1024->1024
    # (k=5, stride 3 except last) + conv_post (3,1): 1_842_407_168
    assert flops.disc_p_flops(2, 8192) == 1_842_407_168


def test_train_step_magnitude_medium():
    """One fused G+D step at (128 text, 512 frames): generator fwd+bwd
    ~3x ~18 GFLOP, discriminators 7x ~10 GFLOP -> ~124 GFLOP/element.
    Pin the magnitude so train MFU can't silently regress to a broken
    denominator."""
    hp = VitsHParams.preset("medium")
    g = flops.train_step_gflops(hp, 128, 512, batch_size=1)
    assert 110.0 < g < 140.0
    # scales linearly in batch
    assert flops.train_step_gflops(hp, 128, 512, batch_size=8) == 8 * g
