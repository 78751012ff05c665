"""Browser-based annotation server (reference saber/gui/web/server.py:21-251).

The reference uses Flask+CORS; neither is available in this image, so the
server is a dependency-free ``http.server`` app exposing the same REST
surface, serving a single-page annotation UI:

- GET  /                     the annotation app (embedded HTML/JS)
- GET  /api/runs             run names + annotation progress
- GET  /api/run/<name>       image (PNG base64) + mask overlay + metadata
- GET  /api/run/<name>/slice/<z>  z-slice review for 3D stacks (the
                             reference's annotation_viewer_3d z-slider,
                             gui/base/annotation_viewer_3d.py)
- POST /api/annotate         {run, accepted: {class: [idx]}, rejected: [idx]}
- GET  /api/run/<name>/pick?y=&x=&z=  mask hits under a pixel (dual-view
                             click-to-accept; 2D stacks return ALL
                             overlapping masks for click cycling)
- POST /api/accepted_overlay {run, accepted, z} → accepted-only overlay
                             PNG colored by class (the dual-view right
                             pane, reference segmentation_picker)
- GET  /api/annotations      current annotation JSON
- GET  /api/classes          class-name map from zarr attrs

Annotations persist to ``<zarr>_annotations.json`` in the apply_labels
schema (saber_tpu/classifier/preprocess/apply_labels.py), closing the
curation loop. Remote/HPC use: SSH-tunnel the port (reference
gui/run.py:43-58 pattern).
"""

import base64
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from saber_tpu.utils import zarrlite

_PAGE = """<!DOCTYPE html>
<html><head><title>saber-tpu annotator</title><style>
body{font-family:sans-serif;margin:16px;background:#111;color:#eee}
#runs{float:left;width:200px} #main{margin-left:220px}
button{margin:2px;padding:4px 10px}
canvas{border:1px solid #444;image-rendering:pixelated}
.mask{cursor:pointer;padding:2px 6px;display:inline-block;margin:2px;
      border:1px solid #555;border-radius:4px}
.clsbtn{cursor:pointer;padding:2px 8px;display:inline-block;margin:2px;
        border:2px solid #555;border-radius:4px}
.clssel{border-color:#fff}
.rejected{background:#d44}
#zrow{margin:6px 0}
</style></head><body>
<div id="runs"><h3>Runs</h3><ul id="runlist"></ul></div>
<div id="main"><h3 id="title">select a run</h3>
<canvas id="cv" width="512" height="512" title="candidates — click to
 accept into the selected class; repeated clicks cycle overlaps; wheel
 zooms, drag pans (both panes synced); double-click resets"></canvas>
<canvas id="cv2" width="512" height="512"
 title="accepted masks (class colors)"></canvas>
<div id="zrow" style="display:none">z:
  <input id="zslider" type="range" min="0" max="0" value="0"
         oninput="setZ(this.value)">
  <span id="zlabel"></span></div>
<div>classes: <span id="classes"></span>
  <label><input id="ovl" type="checkbox" checked onchange="draw()">
  overlay</label>
  <button onclick="undo()">undo</button>
  <button onclick="save()">save annotations</button>
  <button onclick="gallery()">class gallery</button></div>
<div id="masks"></div>
<div id="gallery"></div></div>
<script>
// TAB10-style palette, one color per class (the reference pickers color
// accepted masks per class the same way, multi_class_segmentation_picker)
const PAL=['#1f77b4','#ff7f0e','#2ca02c','#d62728','#9467bd','#8c564b',
           '#e377c2','#7f7f7f','#bcbd22','#17becf'];
let cur=null, data=null, state={}, curCls='1', z=0, history=[];
async function loadRuns(){
  const rs = await (await fetch('/api/runs')).json();
  const ul = document.getElementById('runlist'); ul.innerHTML='';
  rs.runs.forEach(r=>{const li=document.createElement('li');
    li.textContent=r+(rs.annotated.includes(r)?' ✓':'');
    li.style.cursor='pointer';
    li.onclick=()=>loadRun(r); ul.appendChild(li);});
  const cls = await (await fetch('/api/classes')).json();
  const names = Object.keys(cls).length?cls:{1:'class 1',2:'class 2'};
  const cd=document.getElementById('classes'); cd.innerHTML='';
  Object.entries(names).forEach(([id,name])=>{
    const b=document.createElement('span'); b.className='clsbtn';
    b.style.background=PAL[(id-1)%10]; b.textContent=id+': '+name;
    b.id='cls'+id;
    b.onclick=()=>{curCls=String(id);
      document.querySelectorAll('.clsbtn').forEach(e=>
        e.classList.remove('clssel'));
      b.classList.add('clssel');};
    cd.appendChild(b);});
  const first=document.querySelector('.clsbtn');
  if(first) first.click();
}
async function loadRun(name){
  cur=name; z=0; history=[];
  data = await (await fetch('/api/run/'+name)).json();
  document.getElementById('title').textContent=name;
  const zrow=document.getElementById('zrow');
  if(data.nz>1){zrow.style.display='';
    const s=document.getElementById('zslider');
    s.max=data.nz-1; s.value=data.z;
    z=data.z;
    document.getElementById('zlabel').textContent=z+'/'+(data.nz-1);}
  else zrow.style.display='none';
  state[name]=state[name]||{accepted:{},rejected:[]};
  vt={s:1,ox:0,oy:0}; accOvl=null; lastPick=null;
  draw(); chips(); refreshAccepted();
}
async function setZ(v){
  z=+v; document.getElementById('zlabel').textContent=z+'/'+(data.nz-1);
  data = await (await fetch('/api/run/'+cur+'/slice/'+z)).json();
  draw(); refreshAccepted();
}
// dual-view state: shared zoom/pan (headless analog:
// annotation_session.LinkedViews), accepted-only overlay for the right
// pane, click-cycling through overlapping masks (ClickCycler)
let vt={s:1,ox:0,oy:0}, accOvl=null, lastPick=null, ovlTimer=null;
function drawPane(id, baseB64, overlayB64, alpha){
  const cv=document.getElementById(id), ctx=cv.getContext('2d');
  const img=new Image();
  img.onload=()=>{
    const sw=img.width/vt.s, sh=img.height/vt.s;
    ctx.clearRect(0,0,cv.width,cv.height);
    ctx.drawImage(img,vt.ox,vt.oy,sw,sh,0,0,cv.width,cv.height);
    if(overlayB64){
      const ov=new Image();
      ov.onload=()=>{ctx.globalAlpha=alpha;
        ctx.drawImage(ov,vt.ox,vt.oy,sw,sh,0,0,cv.width,cv.height);
        ctx.globalAlpha=1;};
      ov.src='data:image/png;base64,'+overlayB64;}};
  img.src='data:image/png;base64,'+baseB64;
}
function draw(){
  const showOvl=document.getElementById('ovl').checked;
  drawPane('cv', data.image, showOvl?data.overlay:null, 0.45);
  drawPane('cv2', data.image, accOvl, 0.6);
}
function refreshAccepted(){
  clearTimeout(ovlTimer);
  ovlTimer=setTimeout(async()=>{
    if(!cur) return;
    const r=await(await fetch('/api/accepted_overlay',{method:'POST',
      headers:{'Content-Type':'application/json'},
      body:JSON.stringify({run:cur,accepted:state[cur].accepted,z:z})})
      ).json();
    accOvl=r.overlay; draw();
  },150);
}
function toImage(cv,ev){
  const r=cv.getBoundingClientRect();
  const fx=(ev.clientX-r.left)/r.width, fy=(ev.clientY-r.top)/r.height;
  const W=data.shape[1], H=data.shape[0];
  return [vt.oy+fy*H/vt.s, vt.ox+fx*W/vt.s];   // [y, x] image coords
}
function clampVt(){
  const W=data.shape[1], H=data.shape[0];
  vt.s=Math.max(1,Math.min(40,vt.s));
  vt.ox=Math.max(0,Math.min(W-W/vt.s,vt.ox));
  vt.oy=Math.max(0,Math.min(H-H/vt.s,vt.oy));
}
function wireViews(){
  let drag=null;
  for(const id of ['cv','cv2']){
    const cv=document.getElementById(id);
    cv.onwheel=(ev)=>{ev.preventDefault(); if(!data) return;
      const [ay,ax]=toImage(cv,ev);
      const ns=vt.s*(ev.deltaY<0?1.25:0.8);
      const k=vt.s/Math.max(1,Math.min(40,ns));
      vt.ox=ax-(ax-vt.ox)*k; vt.oy=ay-(ay-vt.oy)*k;
      vt.s=ns; clampVt(); draw();};
    cv.onmousedown=(ev)=>{drag={x:ev.clientX,y:ev.clientY,
                                ox:vt.ox,oy:vt.oy,moved:false};};
    cv.onmousemove=(ev)=>{if(!drag||!data) return;
      const r=cv.getBoundingClientRect();
      const dx=(ev.clientX-drag.x)/r.width*data.shape[1]/vt.s;
      const dy=(ev.clientY-drag.y)/r.height*data.shape[0]/vt.s;
      if(Math.abs(ev.clientX-drag.x)+Math.abs(ev.clientY-drag.y)>3)
        drag.moved=true;
      vt.ox=drag.ox-dx; vt.oy=drag.oy-dy; clampVt(); draw();};
    cv.onmouseup=async(ev)=>{
      const wasDrag=drag&&drag.moved; drag=null;
      if(wasDrag||id!=='cv'||!data||!cur) return;
      const [ny,nx]=toImage(cv,ev);
      const py=Math.floor(ny), px=Math.floor(nx);
      const h=await(await fetch('/api/run/'+cur+'/pick?y='+py+'&x='+px+
                                '&z='+z)).json();
      if(!h.hits.length){lastPick=null; return;}
      // repeated clicks at one pixel cycle through the overlap set
      if(lastPick && lastPick.y===py && lastPick.x===px) lastPick.k++;
      else lastPick={y:py,x:px,k:0};
      const hit=h.hits[lastPick.k % h.hits.length];
      history.push([hit,stateOf(hit)]);
      apply(hit,curCls);
      refreshAccepted();};
    cv.onmouseleave=()=>{drag=null;};
    cv.ondblclick=()=>{if(!data) return; vt={s:1,ox:0,oy:0}; draw();};
  }
}
wireViews();
function stateOf(i){
  const s=state[cur];
  if(s.rejected.includes(i)) return 'rejected';
  for(const c in s.accepted) if(s.accepted[c].includes(i)) return c;
  return null;
}
function chips(){
  const md=document.getElementById('masks'); md.innerHTML='';
  data.masks.forEach((m)=>{const b=document.createElement('span');
    b.className='mask'; b.id='m'+m.index;
    b.textContent='mask '+m.index+' ('+m.area+'px)';
    paint(b,stateOf(m.index));
    b.onclick=()=>toggle(m.index,b); md.appendChild(b);});
}
function paint(el,st){
  el.className='mask'+(st==='rejected'?' rejected':'');
  el.style.background = (st&&st!=='rejected')?PAL[(st-1)%10]:'';
}
function apply(i,st){
  const s=state[cur];
  s.rejected=s.rejected.filter(x=>x!==i);
  for(const c in s.accepted) s.accepted[c]=s.accepted[c].filter(x=>x!==i);
  if(st==='rejected') s.rejected.push(i);
  else if(st){(s.accepted[st]=s.accepted[st]||[]).push(i);}
  const el=document.getElementById('m'+i); if(el) paint(el,st);
}
function toggle(i){
  const prev=stateOf(i);
  // cycle: none -> current class -> rejected -> none (reference
  // segmentation_picker accept/reject flow with per-class colors)
  const next = prev===null?curCls:(prev==='rejected'?null:'rejected');
  history.push([i,prev]);
  apply(i,next);
  refreshAccepted();
}
function undo(){
  const h=history.pop(); if(!h) return;
  apply(h[0],h[1]);
  refreshAccepted();
}
async function gallery(){
  // per-class review gallery: thumbnails of every mask accepted into the
  // selected class; clicking a 3D thumbnail jumps the z-slider to the
  // mask's best slice (reference per-class galleries + label-jump nav)
  if(!cur) return;
  const g = await (await fetch('/api/gallery/'+cur+'?cls='+curCls)).json();
  const gd = document.getElementById('gallery');
  gd.innerHTML = '<h4>class '+curCls+' — '+g.items.length+' masks</h4>';
  g.items.forEach(it=>{
    const d=document.createElement('span');
    d.style.cssText='display:inline-block;margin:3px;text-align:center;'+
                    'cursor:pointer;border:1px solid '+PAL[(curCls-1)%10];
    const im=document.createElement('img');
    im.src='data:image/png;base64,'+it.image;
    im.style.cssText='height:96px;display:block';
    const cap=document.createElement('small');
    cap.textContent='mask '+it.label+(it.z!=null?' z='+it.z:'');
    d.appendChild(im); d.appendChild(cap);
    if(it.z!=null) d.onclick=()=>{
      document.getElementById('zslider').value=it.z; setZ(it.z);};
    gd.appendChild(d);});
}
async function save(){
  await fetch('/api/annotate',{method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({run:cur,...state[cur]})});
  loadRuns();
}
loadRuns();
</script></body></html>"""

# TAB10 colors for the server-side overlay PNG (RGB)
_TAB10 = np.array([
    [31, 119, 180], [255, 127, 14], [44, 160, 44], [214, 39, 40],
    [148, 103, 189], [140, 86, 75], [227, 119, 194], [127, 127, 127],
    [188, 189, 34], [23, 190, 207]], np.uint8)


def _png_b64(image: np.ndarray) -> str:
    import imageio.v2 as imageio
    img = np.asarray(image, np.float32)
    lo, hi = np.percentile(img, [1, 99])
    img = np.clip((img - lo) / (hi - lo + 1e-8), 0, 1)
    buf = io.BytesIO()
    imageio.imwrite(buf, (img * 255).astype(np.uint8), format="png")
    return base64.b64encode(buf.getvalue()).decode()


def _overlay_b64(label_map: np.ndarray) -> str:
    """Label map → RGBA PNG, TAB10 color per label, transparent background."""
    import imageio.v2 as imageio
    lab = np.asarray(label_map).astype(np.int64)
    rgba = np.zeros((*lab.shape, 4), np.uint8)
    fg = lab > 0
    rgba[fg, :3] = _TAB10[(lab[fg] - 1) % len(_TAB10)]
    rgba[fg, 3] = 255
    buf = io.BytesIO()
    imageio.imwrite(buf, rgba, format="png")
    return base64.b64encode(buf.getvalue()).decode()


class AnnotationApp:
    """Zarr-backed state shared by request handlers."""

    def __init__(self, zarr_path: str):
        self.zarr_path = zarr_path
        self.root = zarrlite.Group(zarr_path)
        self.ann_path = os.path.splitext(zarr_path)[0] + "_annotations.json"
        self.lock = threading.Lock()
        self.annotations: Dict = {}
        if os.path.exists(self.ann_path):
            with open(self.ann_path) as f:
                self.annotations = json.load(f)

    def runs(self):
        return {"runs": list(self.root.keys()),
                "annotated": sorted(self.annotations.keys())}

    def _load(self, name: str):
        grp = self.root[name]
        image = np.asarray(grp["0"])
        stack = None
        if "labels" in grp and "0" in grp["labels"]:
            stack = np.asarray(grp["labels"]["0"])
        return image, stack

    @staticmethod
    def _mask_entries(label_map: Optional[np.ndarray], by_value: bool):
        """Mask metadata: ``by_value`` treats the array as a label map
        (3D volumes — index = label id); else a per-mask (N, H, W) stack."""
        masks = []
        if label_map is None:
            return masks
        if by_value:
            ids = np.unique(label_map)
            for i in ids[ids > 0]:
                m = label_map == i
                ys, xs = np.nonzero(m.reshape(-1, m.shape[-1]))
                masks.append({"index": int(i), "area": int(m.sum())})
        else:
            stack = label_map if label_map.ndim == 3 else label_map[None]
            for i in range(stack.shape[0]):
                m = stack[i] > 0
                masks.append({"index": i, "area": int(m.sum())})
        return masks

    @staticmethod
    def _slice_label_map(stack: Optional[np.ndarray], is_3d: bool,
                         z: int) -> Optional[np.ndarray]:
        if stack is None:
            return None
        if is_3d:
            return np.asarray(stack[z])
        # 2D: per-mask stack → composite label map (index i → label i+1)
        s = stack if stack.ndim == 3 else stack[None]
        comp = np.zeros(s.shape[1:], np.int32)
        for i in range(s.shape[0]):
            comp = np.where(s[i] > 0, i + 1, comp)
        return comp

    def run_payload(self, name: str, z: Optional[int] = None):
        """One viewable slice + overlay + mask metadata. For 3D stacks the
        z-slider scrolls slices (reference annotation_viewer_3d.py)."""
        image, stack = self._load(name)
        is_3d = image.ndim == 3
        nz = image.shape[0] if is_3d else 1
        if z is None:
            z = nz // 2 if is_3d else 0
        z = max(0, min(nz - 1, int(z)))
        img2d = image[z] if is_3d else image
        label2d = self._slice_label_map(stack, is_3d, z)
        masks = self._mask_entries(stack, by_value=is_3d)
        out = {"image": _png_b64(img2d), "shape": list(img2d.shape),
               "masks": masks, "nz": nz, "z": z}
        if label2d is not None and label2d.any():
            out["overlay"] = _overlay_b64(label2d)
        return out

    def pick(self, name: str, y: int, x: int, z=None):
        """Mask hits under a pixel (dual-view click-to-accept, reference
        segmentation_picker.py:144-196). 3D label maps return the single
        label at the voxel; 2D per-mask stacks return EVERY overlapping
        mask index so the client can cycle repeated clicks through them
        (gui/base/annotation_session.masks_at / ClickCycler)."""
        image, stack = self._load(name)
        if stack is None:
            return {"hits": []}
        is_3d = image.ndim == 3
        y, x = int(y), int(x)
        if is_3d:
            zi = max(0, min(image.shape[0] - 1, int(z or 0)))
            label2d = np.asarray(stack[zi])
            h, w = label2d.shape
            if not (0 <= y < h and 0 <= x < w):
                return {"hits": []}
            v = int(label2d[y, x])
            return {"hits": [v] if v > 0 else []}
        from saber_tpu.gui.base.annotation_session import masks_at
        s = stack if stack.ndim == 3 else stack[None]
        return {"hits": masks_at(s > 0, y, x)}

    def accepted_overlay(self, payload: dict):
        """Accepted-only overlay colored by class — the dual-view RIGHT
        pane (reference segmentation_picker's accepted view). Indices use
        the same space as the mask chips: label values for 3D maps,
        stack indices for 2D stacks."""
        import imageio.v2 as imageio
        name = payload["run"]
        image, stack = self._load(name)
        is_3d = image.ndim == 3
        z = int(payload.get("z", 0)) if is_3d else 0
        label2d = self._slice_label_map(stack, is_3d, z)
        if label2d is None:
            return {"overlay": None}
        rgba = np.zeros((*label2d.shape, 4), np.uint8)
        for cls, idxs in (payload.get("accepted") or {}).items():
            color = _TAB10[(int(cls) - 1) % len(_TAB10)]
            for i in idxs:
                lab = int(i) if is_3d else int(i) + 1
                m = label2d == lab
                rgba[m, :3] = color
                rgba[m, 3] = 255
        buf = io.BytesIO()
        imageio.imwrite(buf, rgba, format="png")
        return {"overlay": base64.b64encode(buf.getvalue()).decode()}

    def annotate(self, payload: dict):
        run = payload.pop("run")
        with self.lock:
            self.annotations[run] = {
                "accepted": payload.get("accepted", {}),
                "rejected": payload.get("rejected", []),
            }
            with open(self.ann_path, "w") as f:
                json.dump(self.annotations, f, indent=1)
        return {"ok": True, "run": run}

    # free-text / hashtag labeling per segmentation (the reference's
    # text-annotation GUI, saber/gui/text/*: per-segmentation notes and
    # #hashtags for text/VLM-style supervision)
    @property
    def text_path(self):
        return os.path.splitext(self.zarr_path)[0] + "_text_annotations.json"

    def text_annotations(self) -> Dict:
        if os.path.exists(self.text_path):
            with open(self.text_path) as f:
                return json.load(f)
        return {}

    def annotate_text(self, payload: dict):
        run = payload["run"]
        idx = str(payload["index"])
        text = payload.get("text", "")
        # same regex as the Qt manager — a whitespace split would store
        # punctuation-trailing tags ('#mito.') the Qt side can never
        # extract, making them undeletable "manual" tags there
        from saber_tpu.gui.text.hashtag_manager import HashtagManager
        hashtags = sorted(HashtagManager.extract_hashtags(text)
                          | set(payload.get("hashtags", [])))
        with self.lock:
            ann = self.text_annotations()
            ann.setdefault(run, {})[idx] = {"text": text, "hashtags": hashtags}
            with open(self.text_path, "w") as f:
                json.dump(ann, f, indent=1)
        return {"ok": True, "run": run, "index": idx, "hashtags": hashtags}

    def hashtags(self):
        """Global hashtag frequency (reference hashtag_manager.py).
        ``_``-prefixed keys are sidecar metadata (the Qt manager's
        ``_hashtags`` color map), not runs."""
        counts: Dict[str, int] = {}
        for run, run_ann in self.text_annotations().items():
            if run.startswith("_") or not isinstance(run_ann, dict):
                continue
            for entry in run_ann.values():
                if isinstance(entry, dict):
                    for tag in entry.get("hashtags", []):
                        counts[tag] = counts.get(tag, 0) + 1
        return counts

    def classes(self):
        return dict(self.root.attrs.get("labels", {}))

    def gallery(self, name: str, cls) -> Dict:
        """Per-class gallery: cropped thumbnails of every mask accepted
        into ``cls`` for a run (reference per-class review galleries,
        visualization/galleries.py + zarr GUI grouping — served headless
        via gui.base.annotation_session.class_gallery)."""
        from saber_tpu.gui.base.annotation_session import (
            AnnotationSession, SliceNavigator, class_gallery,
            per_slice_label_areas)
        image, stack = self._load(name)
        is_3d = image.ndim == 3
        sess = AnnotationSession()
        with self.lock:
            acc = dict(self.annotations.get(name, {}).get("accepted", {}))
        if not is_3d:
            # 2D web indices are 0-based stack positions; the composite
            # label map is 1-based (_slice_label_map)
            acc = {c: [i + 1 for i in v] for c, v in acc.items()}
        sess.annotations = {name: {"accepted": acc, "rejected": []}}
        label_map = (np.asarray(stack) if is_3d
                     else self._slice_label_map(stack, False, 0))
        if label_map is None:
            return {"items": []}
        items = class_gallery(sess, name, image, label_map, cls)
        # one histogram pass shared by every item's slice list (each bare
        # slices_with_label call would re-scan the full volume)
        areas = per_slice_label_areas(label_map) if is_3d else None
        out = []
        for it in items:
            entry = {
                "label": it["label"] - (0 if is_3d else 1),
                "z": it["z"], "bbox": list(it["bbox"]),
                "image": _png_b64(it["image"]),
                # class color, not label color: the gallery is BY class
                "overlay": _overlay_b64(it["mask"].astype(np.int32)
                                        * int(cls)),
            }
            if is_3d:
                entry["slices"] = SliceNavigator.slices_with_label(
                    label_map, it["label"], areas=areas)
            out.append(entry)
        return {"items": out, "cls": str(cls), "run": name}

    def progress(self):
        """Curation progress summary (parity with the Qt workbench's
        counters — AnnotationSession.progress semantics)."""
        runs = list(self.root.keys())
        per_class: Dict[str, int] = {}
        rejected = 0
        touched = 0
        with self.lock:
            for run in runs:
                a = self.annotations.get(run)
                if not a:
                    continue
                got = False
                for cls, labels in a.get("accepted", {}).items():
                    if labels:
                        per_class[cls] = per_class.get(cls, 0) + len(labels)
                        got = True
                nrej = len(a.get("rejected", []))
                rejected += nrej
                touched += bool(got or nrej)
        return {"runs_annotated": touched, "runs_total": len(runs),
                "per_class": per_class, "rejected": rejected}


def _make_handler(app: AnnotationApp):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/json"):
            data = body if isinstance(body, bytes) else json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            try:
                if self.path in ("/", "/index.html"):
                    self._send(200, _PAGE.encode(), "text/html")
                elif self.path == "/api/runs":
                    self._send(200, app.runs())
                elif self.path.startswith("/api/run/"):
                    rest = self.path[len("/api/run/"):]
                    if "/pick" in rest:
                        from urllib.parse import parse_qs, urlparse
                        parsed = urlparse(self.path)
                        name = parsed.path[len("/api/run/"):-len("/pick")]
                        q = parse_qs(parsed.query)
                        self._send(200, app.pick(
                            name, int(q.get("y", ["0"])[0]),
                            int(q.get("x", ["0"])[0]),
                            z=int(q.get("z", ["0"])[0])))
                    elif "/slice/" in rest:
                        name, zs = rest.split("/slice/", 1)
                        self._send(200, app.run_payload(name, z=int(zs)))
                    else:
                        self._send(200, app.run_payload(rest))
                elif self.path == "/api/annotations":
                    self._send(200, app.annotations)
                elif self.path == "/api/text":
                    self._send(200, app.text_annotations())
                elif self.path == "/api/hashtags":
                    self._send(200, app.hashtags())
                elif self.path == "/api/progress":
                    self._send(200, app.progress())
                elif self.path == "/api/classes":
                    self._send(200, app.classes())
                elif self.path.startswith("/api/gallery/"):
                    from urllib.parse import parse_qs, urlparse
                    parsed = urlparse(self.path)
                    name = parsed.path[len("/api/gallery/"):]
                    cls = parse_qs(parsed.query).get("cls", ["1"])[0]
                    self._send(200, app.gallery(name, cls))
                else:
                    self._send(404, {"error": "not found"})
            except KeyError:
                self._send(404, {"error": "unknown run"})
            except Exception as e:  # robust server: report, don't die
                self._send(500, {"error": str(e)})

        def do_POST(self):
            try:
                if self.path == "/api/annotate":
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    self._send(200, app.annotate(payload))
                elif self.path == "/api/annotate_text":
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    self._send(200, app.annotate_text(payload))
                elif self.path == "/api/accepted_overlay":
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    self._send(200, app.accepted_overlay(payload))
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:
                self._send(500, {"error": str(e)})

        def log_message(self, *args):  # quiet
            pass

    return Handler


def run_server(zarr_path: str, host: str = "127.0.0.1", port: int = 8080,
               block: bool = True) -> ThreadingHTTPServer:
    """Start the annotation server (reference server.py:116 run_server)."""
    app = AnnotationApp(zarr_path)
    server = ThreadingHTTPServer((host, port), _make_handler(app))
    print(f"saber-tpu web annotator on http://{host}:{port} "
          f"(annotations → {app.ann_path})")
    if block:
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
