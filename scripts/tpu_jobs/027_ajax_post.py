"""Ajax rows after the fast-helper swap (fill_interaction_fast +
mesh_attr BSDF row + packed emitter table in whitted/path/simple):
the 022 diag showed the 10-gather helpers cost ~67 ms of the 91.5 ms
whitted batch.  Also A/B the shadow presort for whitted's NEE rays."""
import importlib

import numpy as np

import nori_tpu.config as cfg
importlib.reload(cfg)
import nori_tpu.accel.pallas_mt as pm
importlib.reload(pm)
import nori_tpu.accel.traverse as tv
importlib.reload(tv)
import nori_tpu.interaction as itx
importlib.reload(itx)
import nori_tpu.integrators.base as ib
importlib.reload(ib)
import nori_tpu.integrators.simple_integrators as isi
importlib.reload(isi)
import nori_tpu.integrators.whitted as iw
importlib.reload(iw)
import nori_tpu.integrators.path as ip
importlib.reload(ip)
import nori_tpu.render as rd
importlib.reload(rd)
import nori_tpu.wavefront as wf
importlib.reload(wf)

from nori_tpu import load_from_xml

AJN = "/root/reference/scenes/pa2/ajax-normals.xml"
AJR = "/root/reference/scenes/pa5/ajax/ajax-rough.xml"


def e2e(tag, xml, spp, batch=None):
    scene = load_from_xml(xml)
    rd.render(scene, spp=spp, seed=0, batch=batch)
    img, st = rd.render(scene, spp=spp, seed=1, batch=batch)
    print(f"[{tag}] e2e spp={spp}: {st['mrays_per_sec']:.2f} Mrays/s "
          f"({st['seconds']:.2f}s, rays {st['rays']}, "
          f"mean {float(np.mean(img)):.4f})", flush=True)


e2e("ajn-fast", AJN, 4)
e2e("ajr-fast", AJR, 4)
e2e("ajr-fast-spp16", AJR, 16)
print("done", flush=True)
