SELECT * FROM (VALUES
(CAST('receive' AS VARCHAR),CAST('Award' AS VARCHAR),CAST(194 AS BIGINT)),
('reside','Residence_period',119),
('study','Education',218),
('bear','Being_born',119),
('join','Work',110),
('die','Death',207),
('live','Residence',92),
('work','Occupation',125),
('marry','Marriage',104),
('raise','Parenting',101)
) AS t("lu","frame","n")