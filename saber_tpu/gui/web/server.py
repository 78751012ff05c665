"""Browser-based annotation server (reference saber/gui/web/server.py:21-251).

The reference uses Flask+CORS; neither is available in this image, so the
server is a dependency-free ``http.server`` app exposing the same REST
surface, serving a single-page annotation UI:

- GET  /                     the annotation app (embedded HTML/JS)
- GET  /api/runs             run names + annotation progress
- GET  /api/run/<name>       image (PNG base64) + per-mask outlines
- POST /api/annotate         {run, accepted: {class: [idx]}, rejected: [idx]}
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
.accepted{background:#2d6} .rejected{background:#d44}
</style></head><body>
<div id="runs"><h3>Runs</h3><ul id="runlist"></ul></div>
<div id="main"><h3 id="title">select a run</h3>
<canvas id="cv" width="512" height="512"></canvas>
<div>class: <input id="cls" value="1" size="3">
<button onclick="save()">save annotations</button></div>
<div id="masks"></div></div>
<script>
let cur=null, data=null, state={};
async function loadRuns(){
  const rs = await (await fetch('/api/runs')).json();
  const ul = document.getElementById('runlist'); ul.innerHTML='';
  rs.runs.forEach(r=>{const li=document.createElement('li');
    li.textContent=r; li.style.cursor='pointer';
    li.onclick=()=>loadRun(r); ul.appendChild(li);});
}
async function loadRun(name){
  cur=name; data = await (await fetch('/api/run/'+name)).json();
  document.getElementById('title').textContent=name;
  const img=new Image();
  img.onload=()=>{const cv=document.getElementById('cv');
    cv.getContext('2d').drawImage(img,0,0,cv.width,cv.height);};
  img.src='data:image/png;base64,'+data.image;
  const md=document.getElementById('masks'); md.innerHTML='';
  state[name]=state[name]||{accepted:{},rejected:[]};
  data.masks.forEach((m,i)=>{const b=document.createElement('span');
    b.className='mask'; b.textContent='mask '+i+' ('+m.area+'px)';
    b.onclick=()=>toggle(i,b); md.appendChild(b);});
}
function toggle(i,el){
  const s=state[cur]; const cls=document.getElementById('cls').value;
  const acc=s.accepted[cls]=s.accepted[cls]||[];
  const ai=acc.indexOf(i), ri=s.rejected.indexOf(i);
  if(ai<0&&ri<0){acc.push(i);el.className='mask accepted';}
  else if(ai>=0){acc.splice(ai,1);s.rejected.push(i);el.className='mask rejected';}
  else{s.rejected.splice(ri,1);el.className='mask';}
}
async function save(){
  await fetch('/api/annotate',{method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({run:cur,...state[cur]})});
  alert('saved');
}
loadRuns();
</script></body></html>"""


def _png_b64(image: np.ndarray) -> str:
    import imageio.v2 as imageio
    img = np.asarray(image, np.float32)
    lo, hi = np.percentile(img, [1, 99])
    img = np.clip((img - lo) / (hi - lo + 1e-8), 0, 1)
    buf = io.BytesIO()
    imageio.imwrite(buf, (img * 255).astype(np.uint8), format="png")
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

    def run_payload(self, name: str):
        grp = self.root[name]
        image = np.asarray(grp["0"])
        if image.ndim == 3:
            image = image[image.shape[0] // 2]
        masks = []
        if "labels" in grp and "0" in grp["labels"]:
            stack = np.asarray(grp["labels"]["0"])
            if stack.ndim == 2:
                stack = stack[None]
            for i in range(stack.shape[0]):
                m = stack[i] > 0
                ys, xs = np.nonzero(m)
                bbox = ([int(xs.min()), int(ys.min()), int(xs.max()),
                         int(ys.max())] if ys.size else [0, 0, 0, 0])
                masks.append({"index": i, "area": int(m.sum()), "bbox": bbox})
        return {"image": _png_b64(image), "shape": list(image.shape),
                "masks": masks}

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
        hashtags = sorted({w for w in text.split() if w.startswith("#")}
                          | set(payload.get("hashtags", [])))
        with self.lock:
            ann = self.text_annotations()
            ann.setdefault(run, {})[idx] = {"text": text, "hashtags": hashtags}
            with open(self.text_path, "w") as f:
                json.dump(ann, f, indent=1)
        return {"ok": True, "run": run, "index": idx, "hashtags": hashtags}

    def hashtags(self):
        """Global hashtag frequency (reference hashtag_manager.py)."""
        counts: Dict[str, int] = {}
        for run_ann in self.text_annotations().values():
            for entry in run_ann.values():
                for tag in entry.get("hashtags", []):
                    counts[tag] = counts.get(tag, 0) + 1
        return counts

    def classes(self):
        return dict(self.root.attrs.get("labels", {}))


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
                    self._send(200, app.run_payload(self.path[len("/api/run/"):]))
                elif self.path == "/api/annotations":
                    self._send(200, app.annotations)
                elif self.path == "/api/text":
                    self._send(200, app.text_annotations())
                elif self.path == "/api/hashtags":
                    self._send(200, app.hashtags())
                elif self.path == "/api/classes":
                    self._send(200, app.classes())
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
