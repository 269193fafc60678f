package graft.etl

/** The core business entity as a typed row (SURVEY §1.4; extraction dict
  * reference src/extractors/bulk_scraper.py:86-104 + post-clean columns
  * src/tools/clean_data.py:117-128). Field names match the canonical
  * `LeadPipeline.leadSchema` column-for-column, so `Dataset[Lead]` round-trips
  * through the untyped pipeline stages; `Option` encodes the reference's
  * "missing key / 'N/A'" cases as nullability with compile-time checking.
  */
final case class Lead(
    id_negocio: Long,
    url: String,
    fecha_extraccion: java.sql.Timestamp,
    nombre: Option[String],
    direccion: Option[String],
    localidad: Option[String],
    telefonos: Seq[String],
    whatsapp: Option[String],
    sitio_web: Option[String],
    email: Option[String],
    facebook: Option[String],
    instagram: Option[String],
    horarios: Option[String],
    rubros: Seq[String],
    descripcion: Option[String],
    servicios: Option[String],
    latitud: Option[Double],
    longitud: Option[Double])
