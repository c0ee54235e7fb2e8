def _output_size(dim, input, size, scale_factor):
    if size is not None:
        return list(size)
    sizes = input.shape[-dim:]
    return [int(s * scale_factor) for s in sizes]
