SELECT * FROM (VALUES
(CAST('Award' AS VARCHAR),CAST(194 AS BIGINT),CAST('receive' AS VARCHAR)),
('Residence_period',119,'reside'),
('Being_born',119,'bear'),
('Parenting',101,'raise'),
('Marriage',104,'marry'),
('Work',960,'join'),
('Residence',92,'live'),
('Death',207,'die'),
('Education',218,'study'),
('Occupation',125,'work')
) AS t("frame","n_sentences","lus")