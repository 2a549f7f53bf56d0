import sys
import numpy as np, jax, jax.numpy as jnp
from raytracingrust_tpu import SceneBuilder, Camera, RenderSettings, Lambertian, Emission
from raytracingrust_tpu.models.mesh import Mesh
from raytracingrust_tpu.render.render import render_linear
from raytracingrust_tpu.diff.grad import apply_params, extract_params
import raytracingrust_tpu.ops.pallas_megakernel as PK
import time

n_quads = int(sys.argv[1]); depth = int(sys.argv[2]); mode = sys.argv[3]
rs = np.random.RandomState(0)
verts, faces = [], []
for i in range(n_quads):
    p = rs.uniform(-3, 3, 3).astype(np.float32); p[2] -= 5
    e1 = rs.uniform(-0.2, 0.2, 3).astype(np.float32)
    e2 = rs.uniform(-0.2, 0.2, 3).astype(np.float32)
    k = len(verts)
    verts += [p, p+e1, p+e2, p+e1+e2]
    faces += [[k, k+1, k+2], [k+1, k+3, k+2]]
verts = np.asarray(verts, np.float32); faces = np.asarray(faces, np.int32)
b = SceneBuilder()
b.camera = Camera.create((0,0,2),(0,0,-1),(0,1,0),70.0,1.0)
b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=depth, enable_bvh_tree=False)
ml = b.add_material(Lambertian((0.6,0.4,0.3)))
b.add_mesh(Mesh.from_buffers(verts, verts, faces, ml))
me = b.add_material(Emission((2.0,1.8,1.5)))
b.add_sphere((2,2,-3), 0.5, me)
scene = b.build(with_bvh=False)
print("tris:", len(scene.triangles), "depth:", depth, "mode:", mode)
t0=time.time()
if mode == "fwd":
    img = render_linear(scene, 64, 64, seed=0, engine="pallas")
    jax.block_until_ready(img)
    print("FWD OK %.1fs" % (time.time()-t0))
else:
    params = extract_params(scene, ("albedo","emission"))
    def loss(p):
        s = apply_params(scene, p)
        return jnp.mean(render_linear(s, 64, 64, seed=0, engine="pallas"))
    g = jax.grad(loss)(params)
    jax.block_until_ready(g)
    print("GRAD OK %.1fs |g|=%g" % (time.time()-t0, float(jnp.abs(g["albedo"]).sum())))
