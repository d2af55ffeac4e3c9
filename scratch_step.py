"""Full bench-config step breakdown at steady-state capacity 65536."""
import time
import jax, jax.numpy as jnp, numpy as np

from fusionsense_tpu.config import ExperimentConfig, LossConfig, ModelConfig, TrainConfig
from fusionsense_tpu.data.synthetic import ring_cameras, sphere_points, sphere_depth_normals
from fusionsense_tpu.gaussians.adc import ADCConfig
from fusionsense_tpu.gaussians.init import init_from_points
from fusionsense_tpu.gaussians.store import activated
from fusionsense_tpu.render.rasterize import RasterizeConfig, rasterize
from fusionsense_tpu.train.trainer import TrainData, Trainer, make_train_chunk, compute_losses
from fusionsense_tpu.train.losses import ssim

WIDTH, HEIGHT = 640, 480
CAP = 1 << 16
REPS = 20

rcfg = RasterizeConfig(tile_size=32, tile_capacity=1024, max_tiles_per_gaussian=9,
                       tile_chunk=100, sh_degree=3, backend="pallas")
cams = ring_cameras(n_views=9, width=WIDTH, height_px=HEIGHT, focal=550.0)
pts, rgb, normals = sphere_points(n=30000, radius=0.5)
g = init_from_points(pts, rgb, capacity=CAP, sh_degree=3, seed_normals=normals, init_opacity=0.95)

cam0 = cams.index(0)
img = jax.jit(lambda: rasterize(*activated(g), cam0, rcfg).rgb)()
d, n, _ = jax.jit(lambda: sphere_depth_normals(cam0))()
data = TrainData(images=jnp.stack([img]*9), sensor_depths=jnp.stack([d]*9), normals=jnp.stack([n]*9))
cfg = ExperimentConfig(model=ModelConfig(sh_degree=3, rasterize=rcfg, capacity=CAP, binary_opacities=False),
                       train=TrainConfig(iterations=15000, scan_chunk=REPS, adc=ADCConfig()), loss=LossConfig())

tr = Trainer(cfg, cams, data, g)
# full chunk of REPS steps
f = tr._train_chunk
args = (tr.gaussians, tr.opt, tr.cam_state, tr.stats, jnp.int32(600), jnp.arange(REPS, dtype=jnp.int32) % 9)
out = f(*args); jax.block_until_ready(out[0].means)
t0 = time.perf_counter(); out = f(*args); jax.block_until_ready(out[0].means)
dt = (time.perf_counter()-t0)/REPS*1e3
print(f"{'full train step (chunk)':42s} {dt:8.3f} ms")

m, q, s, o, c = activated(tr.gaussians)

def scan_reps(body, *args):
    def fn(*a):
        def step(carry, _):
            r = body(*a, carry*1e-30)
            return r*1e-30, r
        _, outs = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return outs
    fj = jax.jit(fn)
    jax.block_until_ready(fj(*args))
    t0=time.perf_counter(); jax.block_until_ready(fj(*args))
    return (time.perf_counter()-t0)/REPS*1e3

def raster_fb(m,q,s,o,c,carry):
    def loss(m,q,s,o,c):
        out = rasterize(m+carry,q,s,o,c,cam0,rcfg)
        return out.rgb.sum()+out.depth.sum()+out.normal.sum()+out.alpha.sum()
    gr = jax.grad(loss,argnums=(0,1,2,3,4))(m,q,s,o,c)
    return sum(x.sum() for x in gr)
print(f"{'rasterize f+b @65536':42s} {scan_reps(raster_fb,m,q,s,o,c):8.3f} ms")

def raster_fwd(m,q,s,o,c,carry):
    out = rasterize(m+carry,q,s,o,c,cam0,rcfg)
    return out.rgb.sum()+out.depth.sum()
print(f"{'rasterize fwd @65536':42s} {scan_reps(raster_fwd,m,q,s,o,c):8.3f} ms")

gt = data.images[0]
def ssim_fb(img, carry):
    def loss(x):
        return ssim(x, gt)
    return jax.grad(loss)(img+carry).sum()
print(f"{'ssim f+b 640x480':42s} {scan_reps(ssim_fb, img):8.3f} ms")

def losses_fb(m,q,s,o,c,carry):
    gg = tr.gaussians.replace(means=m+carry)
    def loss(gg_means):
        g2 = tr.gaussians.replace(means=gg_means)
        l, _ = compute_losses(g2, cams, data, jnp.int32(0), jnp.int32(600), cfg,
                              jnp.zeros((CAP,2)), cam_delta=None,
                              absgrad_tap=jnp.zeros((CAP,2)))
        return l
    return jax.grad(loss)(m+carry).sum()
try:
    print(f"{'full loss f+b (means only)':42s} {scan_reps(losses_fb,m,q,s,o,c):8.3f} ms")
except Exception as e:
    print("loss probe failed:", type(e).__name__, str(e)[:200])
