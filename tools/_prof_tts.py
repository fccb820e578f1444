import sys; sys.path.insert(0, "/root/repo")
import glob, gzip, json, shutil
import numpy as np, jax, jax.numpy as jnp
from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
from wavernn_tpu.training.state import make_optimizer, new_train_state
from wavernn_tpu.training.tacotron import make_tts_train_step

def device_ms(tracedir, prefix="jit_train_step"):
    f = glob.glob(tracedir + "/plugins/profile/*/vm.trace.json.gz")[0]
    with gzip.open(f) as fh: data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name","") for e in data["traceEvents"]
            if e.get("ph")=="M" and e.get("name")=="process_name"}
    tot = 0.0
    for e in data["traceEvents"]:
        if e.get("ph")=="X" and "dur" in e and "TPU" in pids.get(e["pid"],"") \
           and e["name"].startswith(prefix):
            tot += e["dur"]
    return tot/1e3/3

cfg = TacotronConfig()
B, L, T, r = 16, 100, 600, 2
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(1, 140, (B, L)).astype(np.int32))
m = jnp.asarray(rng.uniform(-4, 4, (B, T, cfg.n_mels)).astype(np.float32))
model = Tacotron(cfg)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
    x, m, r, True)
opt = make_optimizer(1e-4, 1.0)
state = new_train_state(variables["params"], variables["batch_stats"], opt)
step = make_tts_train_step(model, opt, r, donate=True)
key = jax.random.PRNGKey(2)
out = step(state, x, m, key); state = out[0]; np.asarray(out[1])
d = "/tmp/jt_tts"
shutil.rmtree(d, ignore_errors=True)
with jax.profiler.trace(d):
    for i in range(3):
        out = step(state, x, m, jax.random.fold_in(key, i))
        state = out[0]
    np.asarray(out[1])
print(f"tts train step: device {device_ms(d):.1f} ms/step", flush=True)
