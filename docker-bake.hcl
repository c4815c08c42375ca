# Buildx bake definition for the serving image (reference docker-bake.hcl
# analog). Override REGISTRY/IMAGE for your registry; COMMIT_SHA is stamped
# by deploy.sh.

variable "COMMIT_SHA" {
  default = "latest"
}

variable "REGISTRY" {
  default = "localhost:5000"
}

variable "IMAGE" {
  default = "pocket-tts-tpu-server"
}

group "default" {
  targets = ["pocket-tts-tpu-server"]
}

target "pocket-tts-tpu-server" {
  context    = "."
  dockerfile = "Dockerfile"
  platforms  = ["linux/amd64"]
  tags = [
    "${REGISTRY}/${IMAGE}:${COMMIT_SHA}",
    "${REGISTRY}/${IMAGE}:latest",
  ]
}
